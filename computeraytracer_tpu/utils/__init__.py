from computeraytracer_tpu.utils.image import write_png  # noqa: F401
from computeraytracer_tpu.utils.metrics import RenderMeter  # noqa: F401
