"""orbslam_birdview_tpu — a TPU-native visual SLAM engine with bird's-eye-view
fusion, built on JAX/XLA/Pallas.

Re-designs the capabilities of donglinb/ORB-SLAM-BIRDVIEW (C++/pthreads) as a
functional, fixed-shape, mesh-shardable pipeline. See SURVEY.md for the
feature blueprint.
"""

import jax as _jax

# Geometry and bundle-adjustment math needs true f32 matmuls; TPU defaults to
# bf16 MXU passes which is not enough for normal equations. Hot kernels that
# can tolerate lower precision opt in explicitly (preferred_element_type).
_jax.config.update("jax_default_matmul_precision", "highest")

__version__ = "0.1.0"

