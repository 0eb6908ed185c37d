from lightfm_tpu.model import LightFM  # noqa: F401
from lightfm_tpu.version import __version__  # noqa: F401

__all__ = ["LightFM", "__version__"]
