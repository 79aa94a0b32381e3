import numpy as np

def oem_numpy(x):
    """Mirror of _odd_even_merge mask/roll logic, flat numpy."""
    n = len(x); K = n // 2
    f = np.arange(n)
    # stage r=K
    ps = np.roll(x, -K)    # out[f] = in[f+K]  (np.roll(x,-K)[f] = x[f+K]) OK
    gt = (x > ps).astype(int)
    low = (f < K).astype(int)
    swap = low * gt + (1 - low) * (1 - gt)
    x = np.where(swap > 0, ps, x)
    q = K.bit_length() - 2
    for q in range(K.bit_length() - 2, -1, -1):
        r = 1 << q
        pm = np.roll(x, -r)
        ph = np.roll(x, r)
        bitq = (f >> q) & 1
        low = bitq * (f < n - r)
        high = (1 - bitq) * (f >= 2 * r)
        part = np.where(bitq > 0, pm, ph)
        gt = (x > part).astype(int)
        swap = low * gt + high * (1 - gt)
        x = np.where(swap > 0, part, x)
    return x

rng = np.random.default_rng(1)
ok = True
for K in [8, 64, 256]:
    for trial in range(200):
        la = rng.integers(0, K + 1)
        a = np.sort(rng.integers(0, 1000, la))
        b = np.sort(rng.integers(0, 1000, K - la))
        A = np.concatenate([a, np.full(K - la, 10**6)])
        B = np.concatenate([b, np.full(la, 10**6)])
        x = np.concatenate([A, B])
        out = oem_numpy(x)[:K]
        exp = np.sort(np.concatenate([a, b]))
        if not np.array_equal(out, exp):
            print("FAIL", K, la, trial)
            print(x, out, exp)
            ok = False
            break
    if not ok: break
print("oem logic ok:", ok)
