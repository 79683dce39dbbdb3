from .video_depth import forward as video_depth_forward, init_params  # noqa: F401
