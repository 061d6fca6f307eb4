from . import metrics, predict, runner, writers  # noqa: F401
