from . import film_pallas, fold_bn  # noqa: F401
