from .infer import VideoDepthPipeline  # noqa: F401
