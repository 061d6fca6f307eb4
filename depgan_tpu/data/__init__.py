from . import dataset, manifest, nifti, pipeline, preprocess  # noqa: F401
