from pct.models.unified import ColorModel, UnifiedConfig
from pct.models import checkpoint

__all__ = ["ColorModel", "UnifiedConfig", "checkpoint"]
