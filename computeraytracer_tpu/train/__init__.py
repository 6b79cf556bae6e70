# NOTE: no function re-exports here — `optimize` must stay importable as
# a submodule (computeraytracer_tpu.train.optimize).
from computeraytracer_tpu.train import checkpoint, optimize  # noqa: F401
