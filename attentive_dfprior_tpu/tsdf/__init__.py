from attentive_dfprior_tpu.tsdf.fusion import TSDFVolume, integrate_frame  # noqa: F401
