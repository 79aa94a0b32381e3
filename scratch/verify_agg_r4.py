import sys; sys.path.insert(0, "/root/repo")
import numpy as np, pyarrow as pa
import jax, jax.numpy as jnp
from gandiva_tpu.ops.hash_aggregate import hash_aggregate
print("backend:", jax.default_backend(), flush=True)

rng = np.random.default_rng(21)
n = 2_000_000
keys = rng.integers(0, 300, n)
vals = rng.random(n) * 1000 - 300

res = jax.jit(lambda k, v: hash_aggregate(
    k, [("v", "sum"), ("v", "count"), ("v", "min"), ("v", "max")],
    {"v": (v, None)}, max_groups=512))(jnp.asarray(keys), jnp.asarray(vals))
cnt = int(res["group_count"]); assert not bool(res["overflow"])
t = pa.table({"k": keys, "v": vals}).group_by("k").aggregate(
    [("v", "sum"), ("v", "count"), ("v", "min"), ("v", "max")])
oracle = {r["k"]: r for r in t.to_pylist()}
gk = np.asarray(res["keys"])[:cnt]
assert set(gk.tolist()) == set(oracle), (cnt, len(oracle))
s = np.asarray(res["agg:v:sum"])[:cnt]
c = np.asarray(res["agg:v:count"])[:cnt]
mn = np.asarray(res["agg:v:min"])[:cnt]
mx = np.asarray(res["agg:v:max"])[:cnt]
for i, k in enumerate(gk.tolist()):
    o = oracle[k]
    assert c[i] == o["v_count"]
    np.testing.assert_allclose(s[i], o["v_sum"], rtol=1e-6)
    np.testing.assert_allclose(mn[i], o["v_min"], rtol=1e-13)
    np.testing.assert_allclose(mx[i], o["v_max"], rtol=1e-13)
print(f"f64 300-group agg on TPU vs acero ok ({cnt} groups, 2M rows)")
