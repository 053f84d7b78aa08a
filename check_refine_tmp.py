import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_device", jax.devices("cpu")[0])
import numpy as np
from spllt_tpu import Options, analyse, factor, solve, poisson2d

m = 16
a = poisson2d(m)
opts = Options(ordering="nd-grid", grid_shape=(m, m), nb=16, nemin=8,
               mode="batched", dtype="float32", prune_tree=False)
num = factor(analyse(a, opts))
rng = np.random.default_rng(0)
x_true = rng.standard_normal((a.n, 3))
b = np.stack([a.matvec(x_true[:, j]) for j in range(3)], axis=1)
x_dev = solve(num, b)                      # device-refined path
num.options.refine_device = False
num._solve_execs.pop("_ell_dev", None)
x_host = solve(num, b)                     # host-refined path
print("dev-host max diff:", np.max(np.abs(x_dev - x_host)))
print("fwd err dev:", np.max(np.abs(x_dev - x_true)))
r = b - np.stack([a.matvec(x_dev[:, j]) for j in range(3)], axis=1)
print("bwd err dev:", np.linalg.norm(r) / np.linalg.norm(b))
assert np.max(np.abs(x_dev - x_true)) < 1e-9
assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-13
print("OK")
