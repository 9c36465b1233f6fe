from attentive_dfprior_tpu.render.renderer import (  # noqa: F401
    RenderConfig,
    render_rays,
    make_z_vals,
    Renderer,
)
