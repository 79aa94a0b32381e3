"""Quantify TPU f64 divergence on the BASELINE configs[0] expression
(VERDICT r4 weak #8): evaluate b*2 + castFLOAT8(a) through the compiled
engine on TPU, compare against CPU IEEE-exact evaluation, report max ulp.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))

import pyarrow as pa
import gandiva_tpu as g
from gandiva_tpu import dtypes as dt

B = g.TreeExprBuilder
schema = dt.Schema([dt.Field("a", dt.int64), dt.Field("b", dt.float64)])
na, nb = B.make_field(schema.field("a")), B.make_field(schema.field("b"))
expr = B.make_expression(
    B.make_function("add",
                    [B.make_function("multiply",
                                     [nb, B.make_double_literal(2.0)],
                                     dt.float64),
                     B.make_function("castFLOAT8", [na], dt.float64)],
                    dt.float64),
    dt.Field("out", dt.float64))
proj = g.make_projector(schema, [expr], use_cache=False)

rng = np.random.default_rng(42)
n = 1_000_000
a = rng.integers(0, 1000, n)
b = rng.random(n)
batch = pa.RecordBatch.from_arrays(
    [pa.array(a), pa.array(b)], names=["a", "b"])
(r,) = proj.evaluate(batch)
got = np.asarray(r)
exact = b * 2.0 + a.astype(np.float64)   # numpy = IEEE binary64

diff = got != exact
# ulp distance via ordered-int mapping of binary64
gi = got.view(np.int64)
ei = exact.view(np.int64)


def to_ordered(x):
    return np.where(x < 0, np.int64(-(2 ** 63)) - x - 1, x)


ulp = np.abs(to_ordered(gi) - to_ordered(ei))
print(f"platform={jax.default_backend()} rows={n}")
print(f"rows differing from IEEE: {int(diff.sum())} "
      f"({100 * diff.mean():.4f}%)")
print(f"max ulp: {int(ulp.max())}  mean ulp (nonzero rows): "
      f"{float(ulp[diff].mean()) if diff.any() else 0.0:.2f}")
print(f"max relative error: {float(np.nanmax(np.abs((got - exact) / np.where(exact == 0, 1, exact)))):.3e}")
