from . import h5_import  # noqa: F401
