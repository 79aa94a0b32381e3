import sys, os
sys.path.insert(0, '.')
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

which = sys.argv[1]

R, LANE = 8, 128

def compile_(kernel, n_out=1):
    f = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((8,), jnp.int32)] * n_out,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * n_out,
        scratch_shapes=[pltpu.VMEM((R, LANE), jnp.int32)],
    )
    x = jnp.ones((R, LANE), jnp.int32)
    r = jax.jit(f)(x)
    print(which, "OK", [np.asarray(v)[:2] for v in r])

if which == "reduce":
    def k(x_ref, o_ref, scratch):
        x = x_ref[...]
        rs = jnp.sum(x, axis=1, dtype=jnp.int32)
        lo = jnp.sum((rs & jnp.int32(0xFFFF)).reshape(1, -1), axis=1,
                     dtype=jnp.int32)[0]
        r = jnp.min(x, axis=1)
        mn = jnp.min(r.reshape(1, -1), axis=1)[0]
        o_ref[0] = lo
        o_ref[1] = mn
    compile_(k)

elif which == "while":
    def k(x_ref, o_ref, scratch):
        x = x_ref[...]
        scratch[...] = jnp.zeros((R, LANE), jnp.int32)
        def um():
            rs = jnp.sum(scratch[...], axis=1, dtype=jnp.int32)
            return jnp.sum(rs.reshape(1, -1), axis=1, dtype=jnp.int32)[0]
        def cond(c):
            cnt, pending = c
            return (pending < jnp.int32(3)) & (cnt < jnp.int32(5))
        def body(c):
            cnt, p = c
            scratch[...] = scratch[...] + jnp.int32(1)
            o_ref[cnt] = p
            return cnt + jnp.int32(1), um()
        cnt, p = lax.while_loop(cond, body, (jnp.int32(0), um()))
        o_ref[6] = cnt
        o_ref[7] = p
    compile_(k)

elif which == "fori":
    def k(x_ref, o_ref, scratch):
        x = x_ref[...]
        o_ref[0] = jnp.int32(2)
        bound = o_ref[0]
        def body(g, c):
            o_ref[g] = jnp.sum(x.reshape(1, -1), axis=1,
                               dtype=jnp.int32)[0] + g
            return c
        lax.fori_loop(jnp.int32(0), bound, body, jnp.int32(0))
    compile_(k)

elif which == "carry1":
    # while with SINGLE i32 carry
    def k(x_ref, o_ref, scratch):
        def cond(c):
            return c < jnp.int32(3)
        def body(c):
            o_ref[c] = c
            return c + jnp.int32(1)
        c = lax.while_loop(cond, body, jnp.int32(0))
        o_ref[7] = c
    compile_(k)

elif which == "carry2":
    def k(x_ref, o_ref, scratch):
        x = x_ref[...]
        def um():
            rs = jnp.sum(scratch[...], axis=1, dtype=jnp.int32)
            return jnp.sum(rs.reshape(1, -1), axis=1, dtype=jnp.int32)[0]
        def cond(c):
            cnt, pending = c
            return (pending < jnp.int32(3)) & (cnt < jnp.int32(5))
        def body(c):
            cnt, p = c
            scratch[...] = scratch[...] + jnp.int32(1)
            o_ref[cnt] = p          # dynamic SMEM store at carry index
            return cnt + 1, um()    # python-int increment like real kernel
        scratch[...] = jnp.zeros((R, LANE), jnp.int32)
        cnt, p = lax.while_loop(cond, body, (jnp.int32(0), um()))
        o_ref[6] = cnt
    compile_(k)

elif which == "nested":
    # fori over groups whose body reads SMEM table at dynamic index and
    # does masked reduce + dynamic SMEM accumulate — the real g-loop shape
    def k(x_ref, o_ref, scratch):
        x = x_ref[...]
        o_ref[0] = jnp.int32(3)
        def body(g, c):
            kh = o_ref[g]
            m = (x == kh).astype(jnp.int32)
            rs = jnp.sum(m, axis=1, dtype=jnp.int32)
            s = jnp.sum(rs.reshape(1, -1), axis=1, dtype=jnp.int32)[0]
            o_ref[g] = o_ref[g] + s
            return c
        lax.fori_loop(jnp.int32(0), o_ref[0], body, jnp.int32(0))
    compile_(k)
