import sys
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

mode = sys.argv[1]
R, L = 8, 128

if mode == "vmem_scalar":
    def kern(in_ref, out_ref, vs):
        vs[...] = in_ref[...] * 2
        acc = jnp.zeros((R, L), jnp.int32)
        for r in range(R):
            s = vs[r, 0]          # scalar read from VMEM
            acc = acc + s
        out_ref[...] = acc
    out = pl.pallas_call(kern,
        out_shape=jax.ShapeDtypeStruct((R, L), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((R, L), jnp.int32)],
    )(jnp.arange(R*L, dtype=jnp.int32).reshape(R, L))
    exp = sum(2*r*L for r in range(R))
    print("vmem_scalar:", np.asarray(out)[0,0] == exp)
elif mode == "vmem_to_smem_dma":
    def kern(in_ref, out_ref, vs, ss, sem):
        vs[...] = in_ref[...] * 2
        pltpu.make_async_copy(vs.at[pl.ds(0, 1)], ss, sem).start()
        pltpu.make_async_copy(vs.at[pl.ds(0, 1)], ss, sem).wait()
        acc = jnp.zeros((R, L), jnp.int32)
        for r in range(R):
            acc = acc + ss[0, r]
        out_ref[...] = acc
    out = pl.pallas_call(kern,
        out_shape=jax.ShapeDtypeStruct((R, L), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((R, L), jnp.int32),
                        pltpu.SMEM((1, L), jnp.int32),
                        pltpu.SemaphoreType.DMA(())],
    )(jnp.arange(R*L, dtype=jnp.int32).reshape(R, L))
    exp = sum(2*r for r in range(R))
    print("vmem_to_smem_dma:", np.asarray(out)[0,0] == exp)
