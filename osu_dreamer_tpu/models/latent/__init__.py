from .model import LatentModel, LatentModelArgs

__all__ = ["LatentModel", "LatentModelArgs"]
