import numpy as np

def fragnet(tmps, cnt, t, rows, LANE=128):
    """Numpy mirror of the planned in-kernel placement.
    tmps: [rows, LANE] packed chunks (first cnt[r] lanes live).
    Returns accum rows [rows+16, LANE] with chunk r's live lanes at
    flat t + offs[r]."""
    AR = rows + 16
    offs = np.concatenate([[0], np.cumsum(cnt)[:-1]]) + t
    rem = offs % LANE
    d = offs // LANE
    lane = np.arange(LANE)
    # rotate right by rem_r (out[l] = in[(l - rem) % L]) via bit stages
    X = tmps.copy()
    live = (lane[None, :] < cnt[:, None]).astype(np.int64)
    for k in range(7):
        b = ((rem >> k) & 1).astype(bool)
        Xr = np.roll(X, 1 << k, axis=1)
        Lr = np.roll(live, 1 << k, axis=1)
        X = np.where(b[:, None], Xr, X)
        live = np.where(b[:, None], Lr, live)
    fragA = np.where((lane[None, :] >= rem[:, None]) & (live > 0), X, 0)
    fragB = np.where((lane[None, :] < rem[:, None]) & (live > 0), X, 0)
    u = np.arange(rows) - d + 8          # shared shift, in [0, rows+8]
    assert (u >= 0).all() and (u < AR).all(), u

    def shift_up(P, u_pad):
        u_pad = u_pad.copy()
        for k in range(7):               # AR <= 80 < 128
            bit = (u_pad >> k) & 1
            Pr = np.roll(P, -(1 << k), axis=0)      # out[q] = P[q + 2^k]
            ur = np.roll(u_pad, -(1 << k))
            bit_r = (ur >> k) & 1
            newP = np.where(bit_r[:, None] > 0, Pr, 0) + \
                np.where(bit[:, None] > 0, 0, P)
            u_pad = np.where(bit_r > 0, ur, u_pad)
            P = newP
        return P

    PA = np.zeros((AR, 128), dtype=np.int64)
    PA[8:8 + rows] = fragA
    UA = np.zeros(AR, dtype=np.int64)
    UA[8:8 + rows] = u
    A = shift_up(PA, UA)
    PB = np.zeros((AR, 128), dtype=np.int64)
    PB[9:9 + rows] = fragB
    UB = np.zeros(AR, dtype=np.int64)
    UB[9:9 + rows] = u
    Bv = shift_up(PB, UB)
    return A + Bv

rng = np.random.default_rng(0)
ok = True
for trial in range(300):
    rows = rng.choice([8, 16, 64])
    t = int(rng.integers(0, 1024))
    cnt = rng.integers(0, 129, rows)
    if trial % 7 == 0:
        cnt[:] = 128          # all-full
    if trial % 11 == 0:
        cnt[:] = 0            # all-empty
    tmps = np.zeros((rows, 128), dtype=np.int64)
    vals = []
    for r in range(rows):
        v = rng.integers(1, 10**9, cnt[r])
        tmps[r, :cnt[r]] = v
        vals.append(v)
    acc = fragnet(tmps, cnt, t, rows)
    flat = acc.reshape(-1)
    expect = np.zeros_like(flat)
    pos = t
    for v in vals:
        expect[pos:pos + len(v)] = v
        pos += len(v)
    if not np.array_equal(flat[t:pos], expect[t:pos]):
        print("FAIL", trial, rows, t, cnt[:8])
        ok = False
        break
print("fragment network ok:", ok)
