from .ba import sharded_ba_step, make_mesh  # noqa: F401
