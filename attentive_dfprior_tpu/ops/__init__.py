"""Core numerical ops: pose math, ray generation, trilinear grid sampling,
volume compositing, hierarchical sampling, and a per-group Adam optimizer.

Everything here is pure-JAX (jit/vmap/grad friendly, static shapes) and forms
the TPU compute path replacing the reference's torch/ATen ops.
"""

from attentive_dfprior_tpu.ops.pose import (  # noqa: F401
    quat_to_rotation,
    rotation_to_quat,
    pose_matrix_from_tensor,
    pose_tensor_from_matrix,
)
from attentive_dfprior_tpu.ops.grid_sample import (  # noqa: F401
    normalize_3d_coordinate,
    trilinear_sample,
    sample_feature_grid,
)
from attentive_dfprior_tpu.ops.rays import (  # noqa: F401
    get_rays_from_uv,
    get_rays_full_image,
    sample_pdf,
)
from attentive_dfprior_tpu.ops.compositing import raw2outputs  # noqa: F401
from attentive_dfprior_tpu.ops.adam import AdamState, adam_init, adam_update  # noqa: F401
