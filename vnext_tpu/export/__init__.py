from .api import export_stablehlo, load_exported, save_exported

__all__ = ["export_stablehlo", "load_exported", "save_exported"]
