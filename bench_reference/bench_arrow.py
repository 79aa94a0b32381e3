import time, numpy as np, pyarrow as pa, pyarrow.compute as pc
import pyarrow.acero as acero

def timeit(fn, reps=3):
    best = float('inf')
    for _ in range(reps):
        t0 = time.perf_counter(); r = fn(); dt = time.perf_counter() - t0
        best = min(best, dt)
    return best, r

rng = np.random.default_rng(42)

# 1) Filter+project, 1M rows, nullable int64/float64
N = 1_000_000
a = rng.integers(0, 1000, N); b = rng.random(N)
mask = rng.random(N) < 0.05
pa_a = pa.array(a, mask=mask); pa_b = pa.array(b)
t = pa.table({'a': pa_a, 'b': pa_b})
expr = (pc.field('a') > 500)
def filt_proj():
    d = acero.Declaration.from_sequence([
        acero.Declaration('table_source', acero.TableSourceNodeOptions(t)),
        acero.Declaration('filter', acero.FilterNodeOptions(expr)),
        acero.Declaration('project', acero.ProjectNodeOptions(
            [pc.field('a'), (pc.field('b') * 2.0 + pc.field('a').cast('float64'))], ['a', 'c'])),
    ])
    return d.to_table(use_threads=False)
dt, r = timeit(filt_proj)
print(f"filter+project 1M rows single-thread: {dt*1e3:.1f} ms -> {N/dt/1e6:.1f} Mrows/s (out {r.num_rows})")

# 2) Hash aggregate, 100M rows, low-card key, sum/count/min/max
N = 100_000_000
key = rng.integers(0, 64, N).astype(np.int64)
val = rng.random(N)
t2 = pa.table({'k': key, 'v': val})
def hagg():
    d = acero.Declaration.from_sequence([
        acero.Declaration('table_source', acero.TableSourceNodeOptions(t2)),
        acero.Declaration('aggregate', acero.AggregateNodeOptions(
            [('v', 'hash_sum', None, 'v_sum'), ('v', 'hash_count', None, 'v_cnt'),
             ('v', 'hash_min_max', None, 'v_mm')], keys=['k'])),
    ])
    return d.to_table(use_threads=True)
dt, r = timeit(hagg, reps=2)
print(f"hash-agg 100M rows (64 groups, threads): {dt:.2f} s -> {N/dt/1e6:.1f} Mrows/s ({r.num_rows} groups)")

# 3) Sort 100M int64 keys + payload
N = 100_000_000
k3 = rng.integers(0, 2**62, N); p3 = rng.integers(0, 1000, N)
t3 = pa.table({'k': k3, 'p': p3})
def srt():
    idx = pc.sort_indices(t3, sort_keys=[('k', 'ascending')])
    return t3.take(idx)
dt, r = timeit(srt, reps=1)
print(f"sort 100M int64 + payload: {dt:.2f} s -> {N/dt/1e6:.1f} Mrows/s")

# 4) Hash join: 100M probe x 1M build, Zipfian keys (scaled from 1B x 10M)
Nb, Np = 1_000_000, 100_000_000
build_keys = np.arange(Nb, dtype=np.int64)
zipf = rng.zipf(1.3, Np).astype(np.int64) % Nb
tb = pa.table({'k': build_keys, 'bv': rng.random(Nb)})
tp = pa.table({'k': zipf, 'pv': rng.random(Np)})
def hjoin():
    d = acero.Declaration.from_sequence([
        acero.Declaration('table_source', acero.TableSourceNodeOptions(tp)),
        acero.Declaration('hashjoin', acero.HashJoinNodeOptions(
            'inner', left_keys='k', right_keys='k',
            right_operand=acero.Declaration('table_source', acero.TableSourceNodeOptions(tb)))),
    ])
    return d.to_table(use_threads=True)
dt, r = timeit(hjoin, reps=1)
print(f"hash-join 100M probe x 1M build (Zipf 1.3, threads): {dt:.2f} s -> {Np/dt/1e6:.1f} Mrows/s probe ({r.num_rows} out)")
