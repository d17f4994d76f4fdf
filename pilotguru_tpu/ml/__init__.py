from pilotguru_tpu.ml import augmentation, data, models, training, weighting  # noqa: F401
