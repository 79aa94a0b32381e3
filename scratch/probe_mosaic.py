import jax, jax.numpy as jnp, numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, L = 16, 128

def kern(starts_ref, hbm_ref, out_ref_, scratch, sem):
    out_ref = out_ref_.at[0]
    t = pl.program_id(0)
    a = starts_ref[t]            # element offset, 1024-aligned
    row = a // 128
    pltpu.make_async_copy(hbm_ref.at[pl.ds(row, R)], scratch, sem).start()
    pltpu.make_async_copy(hbm_ref.at[pl.ds(row, R)], scratch, sem).wait()
    x = scratch[...]
    # dynamic roll on axis 0
    rq = (a % jnp.int32(1024)) // 128
    x = pltpu.roll(x, (jnp.int32(R) - rq) % jnp.int32(R), 0)
    # reverse rows + lanes
    out_ref[...] = x

n_rows = 64
x = jnp.arange(n_rows*128, dtype=jnp.int32).reshape(n_rows, 128)
starts = jnp.array([1024, 2048], dtype=jnp.int32)
out = pl.pallas_call(
    kern,
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(2,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, R, L), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((R, L), jnp.int32),
                        pltpu.SemaphoreType.DMA(())],
    ),
    out_shape=jax.ShapeDtypeStruct((2, R, L), jnp.int32),
)(starts, x)
print("compiled+ran tile kernel", flush=True)
out = np.asarray(out)
# tile 0: rows 8..24 rolled by (8 % ...) rq=(1024%1024)//128=0, reversed
exp0 = np.arange(1024, 1024+R*128).reshape(R,128)
print("tile0 ok:", np.array_equal(out[0], exp0))
exp1 = np.arange(2048, 2048+R*128).reshape(R,128)
print("tile1 ok:", np.array_equal(out[1], exp1))

# dynamic lane roll + select test
def kern2(sh_ref, in_ref, out_ref):
    rl = sh_ref[0]
    x = in_ref[...]
    li = lax.broadcasted_iota(jnp.int32, (R, L), 1)
    a = x
    b = pltpu.roll(x, jnp.int32(R) - 1, 0)   # row+1 source
    c = jnp.where(li < rl, b, a)
    out_ref[...] = pltpu.roll(c, (jnp.int32(L) - rl) % jnp.int32(L), 1)

x2 = jnp.arange(R*128, dtype=jnp.int32).reshape(R, 128)
out2 = pl.pallas_call(
    kern2,
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec((R, L), lambda t, *_: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((R, L), lambda t, *_: (0, 0),
                               memory_space=pltpu.VMEM)),
    out_shape=jax.ShapeDtypeStruct((R, L), jnp.int32),
)(jnp.array([5], jnp.int32), x2)
# expected flat rotate by 5: out_flat[f] = in_flat[f+5]
flat = np.arange(R*128)
expf = np.roll(flat, -5).reshape(R, 128)
print("flat-rotate ok:", np.array_equal(np.asarray(out2), expf))
