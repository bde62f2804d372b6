"""SE(3) on ``jax.numpy`` (float32): jit/vmap-able, used inside device kernels.

See :mod:`hso_tpu.math._se3_impl` for conventions; the host-side float64
mirror is :mod:`hso_tpu.math.se3np`.
"""

import jax.numpy as jnp

from hso_tpu.math._se3_impl import _make_se3

_ns = _make_se3(jnp, jnp.float32)

identity = _ns.identity
from_Rt = _ns.from_Rt
rotation = _ns.rotation
translation = _ns.translation
mul = _ns.mul
inv = _ns.inv
apply = _ns.apply
rotate = _ns.rotate
hat = _ns.hat
so3_exp = _ns.so3_exp
so3_log = _ns.so3_log
exp = _ns.exp
log = _ns.log
adjoint = _ns.adjoint
normalize = _ns.normalize
