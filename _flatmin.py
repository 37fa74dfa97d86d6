import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
from pelvistim_fem_tpu.ops import stencil as st
import pelvistim_fem_tpu.ops.pallas_stencil as ps
rng = np.random.default_rng(0)
shape = (16, 10, 9)
x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
C = jnp.asarray(rng.standard_normal((27,) + shape), jnp.float32)
y1 = st.stencil_spmv(x, C)
y2 = ps.stencil_spmv_flat(x, ps.pack_coeff_flat(C))
err = float(jnp.max(jnp.abs(y1 - y2)))
print("ok, max abs err", err)
