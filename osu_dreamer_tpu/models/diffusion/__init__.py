from .model import DiffusionModel, DiffusionModelArgs

__all__ = ["DiffusionModel", "DiffusionModelArgs"]
