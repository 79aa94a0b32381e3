import sys; sys.path.insert(0, "/root/repo")
import numpy as np, pyarrow as pa
import jax, jax.numpy as jnp
from gandiva_tpu.ops.hash_join import join, gather_payload
print("backend:", jax.default_backend(), flush=True)

rng = np.random.default_rng(7)
NP_, NB = 300_000, 40_000

def acero_join(how, pk, bk, pv, bv):
    import pyarrow.acero as ac
    lt = pa.table({"k": pk, "pv": pv})
    rt = pa.table({"k2": bk, "bv": bv})
    decl = ac.Declaration("hashjoin", ac.HashJoinNodeOptions(
        how, left_keys=["k"], right_keys=["k2"]),
        inputs=[ac.Declaration("table_source", ac.TableSourceNodeOptions(lt)),
                ac.Declaration("table_source", ac.TableSourceNodeOptions(rt))])
    return decl.to_table()

for case, bk in [("unique", rng.permutation(100_000)[:NB]),
                 ("dups", rng.integers(0, 20_000, NB))]:
    bk = bk.astype(np.int64)
    pk = rng.integers(0, 100_000, NP_).astype(np.int64)
    pv = rng.integers(0, 1000, NP_).astype(np.int64)
    bv = rng.integers(0, 1000, NB).astype(np.int64)
    for how in (("left",) if case == "unique" else ("inner", "full")):
        cap = NP_ * (1 if case == "unique" else 40)
        res = jax.jit(lambda p, b, _h=how, _c=cap: join(p, b, _c, _h))(
            jnp.asarray(pk), jnp.asarray(bk))
        cnt = int(res.count); assert not bool(res.overflow), (case, how)
        pi = np.asarray(res.probe_idx)[:cnt]
        bi = np.asarray(res.build_idx)[:cnt]
        if how in ("semi", "anti"):
            exp = acero_join("left " + how, pk, bk, pv, bv)
            assert cnt == exp.num_rows, (case, how, cnt, exp.num_rows)
            assert sorted(pk[pi].tolist()) == sorted(
                exp.column("k").to_pylist()), (case, how)
        else:
            exp = acero_join({"left": "left outer", "full": "full outer", "inner": "inner"}[how], pk, bk, pv, bv)
            assert cnt == exp.num_rows, (case, how, cnt, exp.num_rows)
            got = sorted(zip(
                np.where(pi >= 0, pk[np.clip(pi, 0, None)], -10**9).tolist(),
                np.where(pi >= 0, pv[np.clip(pi, 0, None)], -10**9).tolist(),
                np.where(bi >= 0, bv[np.clip(bi, 0, None)], -10**9).tolist()))
            ek = [(-10**9 if v is None else v) for v in exp.column("k").to_pylist()]
            epv = [(-10**9 if v is None else v) for v in exp.column("pv").to_pylist()]
            ebv = [(-10**9 if v is None else v) for v in exp.column("bv").to_pylist()]
            want = sorted(zip(ek, epv, ebv))
            assert got == want, (case, how, got[:3], want[:3])
        print(f"{case} {how}: ok ({cnt} rows)", flush=True)
print("ALL JOIN DRIVES PASSED")
