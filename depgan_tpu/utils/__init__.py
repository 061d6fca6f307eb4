from . import logging, tb_writer  # noqa: F401
