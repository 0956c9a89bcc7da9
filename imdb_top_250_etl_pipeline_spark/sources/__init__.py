from .catalog import load, load_all, register_views  # noqa: F401
