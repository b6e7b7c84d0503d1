"""Canonical verify drive (per .claude/skills/verify): public package
API on the real TPU backend vs the scipy oracle."""
import numpy as np
import scipy.sparse as sps

import sparse_dot_tpu as sdt
from sparse_dot_tpu.config import config

X = sps.random(500, 5000, density=0.212, format="csr",
               dtype=np.float64, random_state=100)
B = np.random.default_rng(1).standard_normal((5000, 128))

r1 = sdt.dot_product(X, B)
assert np.abs(r1 - X @ B).max() < 1e-6, "SpMM"
print("SpMM ok", flush=True)

r = sdt.dot_product(X, X.T.tocsc())
assert np.abs(r.toarray() - (X @ X.T).toarray()).max() < 1e-6, "SpGEMM"
print(f"SpGEMM sparse-out ok (nnz={r.nnz})", flush=True)

g = sdt.gram_matrix_mkl(X, transpose=True, dense=True)
assert np.abs(g - np.triu((X @ X.T).toarray())).max() < 1e-6, "gram"
print("gram/syrk ok", flush=True)

out = np.ones((500, 128))
r4 = sdt.dot_product_mkl(X, B, out=out, out_scalar=2.0)
assert r4 is out and np.abs(r4 - (X @ B + 2.0)).max() < 1e-6, "out="
print("accumulate semantics ok", flush=True)

# structural pattern: explicit zero kept on the default path
A2 = sps.csr_matrix(np.array([[1.0, -1.0], [2.0, 0.0]]))
B2 = sps.csr_matrix(np.array([[1.0, 3.0], [1.0, 0.0]]))
C2 = sdt.dot_product(A2, B2)
assert C2.nnz == 4 and C2[0, 0] == 0.0, "structural pattern"
print("structural pattern (explicit zero) ok", flush=True)

# cast=False mismatch raises
try:
    sdt.dot_product(X.astype(np.float32), B)
    raise AssertionError("expected ValueError")
except ValueError:
    print("cast=False mismatch raises ok", flush=True)

# zero-nnz operand short-circuits
E = sps.csr_matrix((500, 5000), dtype=np.float64)
r5 = sdt.dot_product(E, B)
assert r5.shape == (500, 128) and not r5.any()
print("empty short-circuit ok", flush=True)

# ozaki kill-switch still correct
config.ozaki = "0"
try:
    r6 = sdt.dot_product(X, X.T.tocsc())
    assert np.abs(r6.toarray() - (X @ X.T).toarray()).max() < 1e-6
finally:
    config.ozaki = "auto"
print("ozaki=0 path ok", flush=True)

# FGMRES first-party solver end to end
from sparse_dot_tpu.solvers import fgmres
n = 40
rng = np.random.default_rng(11)
A = sps.random(n, n, density=0.3, random_state=12, format="csr")
A = (A + n * sps.identity(n)).tocsr()
b = rng.random(n)
x, code = fgmres(A, b, tol=1e-12)
assert code == 0
assert np.abs(x - np.linalg.solve(A.toarray(), b)).max() < 1e-8
print("fgmres ok", flush=True)

print("VERIFY PASS", flush=True)
