from .model import StyleModel, StyleModelArgs

__all__ = ["StyleModel", "StyleModelArgs"]
