import time, numpy as np, pyarrow as pa, pyarrow.acero as acero
rng = np.random.default_rng(42)
Nb, Np = 1_000_000, 100_000_000
tb = pa.table({'k': np.arange(Nb, dtype=np.int64), 'bv': rng.random(Nb)})
tp = pa.table({'k': (rng.zipf(1.3, Np).astype(np.int64) % Nb), 'pv': rng.random(Np)})
t0 = time.perf_counter()
d = acero.Declaration('hashjoin',
    acero.HashJoinNodeOptions('inner', left_keys='k', right_keys='k'),
    inputs=[acero.Declaration('table_source', acero.TableSourceNodeOptions(tp)),
            acero.Declaration('table_source', acero.TableSourceNodeOptions(tb))])
r = d.to_table(use_threads=True)
dt = time.perf_counter() - t0
print(f"hash-join 100M probe x 1M build (Zipf1.3, threads): {dt:.2f} s -> {Np/dt/1e6:.1f} Mrows/s probe ({r.num_rows} out)")
