"""Round-3 verify drive: canonical public-API checks on the real TPU
plus the round-3 paths (adaptive ESC driver, blocked MXU body,
perm-sort ESC kernel)."""
import time

import numpy as np
import scipy.sparse as sps


def log(s):
    print(time.strftime("%H:%M:%S"), s, flush=True)


def main():
    log("importing")
    import sparse_dot_tpu as sdt
    from sparse_dot_tpu.config import config
    from sparse_dot_tpu import formats
    from sparse_dot_tpu.ops import host as hops

    X = sps.random(500, 5000, density=0.212, format="csr",
                   dtype=np.float64, random_state=100)
    B = np.random.default_rng(1).standard_normal((5000, 128))
    assert np.abs(sdt.dot_product(X, B) - X @ B).max() < 1e-6
    log("SpMM OK")
    r = sdt.dot_product(X, X.T.tocsc())
    assert np.abs(r.toarray() - (X @ X.T).toarray()).max() < 1e-6
    log("SpGEMM sparse OK")
    g = sdt.gram_matrix_mkl(X, transpose=True, dense=True)
    assert np.abs(g - np.triu((X @ X.T).toarray())).max() < 1e-6
    log("gram OK")
    out = np.ones((500, 128))
    r4 = sdt.dot_product_mkl(X, B, out=out, out_scalar=2.0)
    assert r4 is out and np.abs(r4 - (X @ B + 2.0)).max() < 1e-6
    log("accumulate OK")

    Ad = formats.to_device(X)
    Bd = hops._to_csr(formats.to_device(X.T.tocsc()))
    t0 = time.perf_counter()
    data, idx, indptr = hops.spgemm_esc_arrays(Ad, Bd, np.float64)
    t1 = (time.perf_counter() - t0) * 1e3
    C = sps.csr_matrix((data, idx, indptr), shape=(500, 500))
    assert np.abs(C.toarray() - (X @ X.T).toarray()).max() < 1e-6
    t0 = time.perf_counter()
    data, idx, indptr = hops.spgemm_esc_arrays(Ad, Bd, np.float64)
    t2 = (time.perf_counter() - t0) * 1e3
    log(f"adaptive ESC OK cold={t1:.0f}ms warm={t2:.0f}ms")

    # forced sort kernel with perm-sort (small, so compile is cheap)
    config.spgemm_esc_force_sort = True
    As = sps.random(300, 200, density=0.05, format="csr",
                    dtype=np.float64, random_state=3)
    Bs = sps.random(200, 250, density=0.05, format="csr",
                    dtype=np.float64, random_state=4)
    d2, i2, p2 = hops.spgemm_esc_arrays(
        formats.to_device(As), formats.to_device(Bs), np.float64)
    C2 = sps.csr_matrix((d2, i2, p2), shape=(300, 250))
    assert np.abs(C2.toarray() - (As @ Bs).toarray()).max() < 1e-9
    config.spgemm_esc_force_sort = False
    log("forced sort-ESC (perm) OK")

    try:
        sdt.dot_product(X.astype(np.float32), B, cast=False)
        raise SystemExit("cast=False did not raise")
    except ValueError:
        log("cast=False raises OK")
    config.ozaki = "0"
    assert np.abs(sdt.dot_product(X, B) - X @ B).max() < 1e-6
    config.ozaki = "auto"
    log("ozaki kill-switch OK")
    log("VERIFY DRIVE PASS")


if __name__ == "__main__":
    main()
