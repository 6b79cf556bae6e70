from computeraytracer_tpu.tracer.api import render, render_sample  # noqa: F401
