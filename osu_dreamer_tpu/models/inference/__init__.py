from .model import LDM, LDMArgs
from .artifact import load_inference, save_inference

__all__ = ["LDM", "LDMArgs", "load_inference", "save_inference"]
