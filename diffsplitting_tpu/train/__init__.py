from .factory import define_generator
from .trainer import DiffusionModel, create_model

__all__ = ["define_generator", "DiffusionModel", "create_model"]
