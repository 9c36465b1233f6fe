"""Scene model: hierarchical feature grids + MLP decoders + attentive
TSDF-fusion module, all as pure-functional JAX parameter pytrees.
"""

from attentive_dfprior_tpu.models.decoders import (  # noqa: F401
    init_mlp_decoder,
    mlp_decoder_forward,
    init_mlp_tsdf,
    mlp_tsdf_forward,
    init_df_decoders,
    df_forward,
)
from attentive_dfprior_tpu.models.scene import (  # noqa: F401
    SceneConfig,
    init_scene,
    load_bound,
)
