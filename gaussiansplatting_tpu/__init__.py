"""TPU-native 3D Gaussian Splatting framework (JAX/XLA/Pallas).

A from-scratch reimplementation of the capability surface of
ctaylo41/GaussianSplatting (Metal/ObjC++), re-architected for TPU:
device-resident jitted train steps, fixed-shape padded arrays, MXU-batched
alpha blending, and deterministic segment-sum gradients.  See SURVEY.md.
"""

import jax

# Gaussian covariance projection and the rasterizer's quadratic forms need
# genuine fp32 matmuls; the TPU default (one-pass bf16 on the MXU) loses
# ~0.4% relative accuracy, which is visible in conics and alpha values.
# Hot kernels that can tolerate lower precision opt in explicitly.
jax.config.update("jax_default_matmul_precision", "highest")

__version__ = "0.1.0"
