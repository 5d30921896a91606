from . import colmap_model, export, stream
