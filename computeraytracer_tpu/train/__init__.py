from computeraytracer_tpu.train.optimize import (  # noqa: F401
    split_scene, merge_scene, make_loss_fn, make_train_step, optimize,
)
