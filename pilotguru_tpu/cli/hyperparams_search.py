"""hyperparams_search CLI: grid search over training-settings JSON files.

Flag-compatible with the reference (/root/reference/python/hyperparams_search.py).
The reference farms folds to a torch.multiprocessing pool with a shared
least-loaded-GPU counter (hyperparams_search.py:30-44, 118-153); on TPU one
chip runs one jitted program at a time, so folds run sequentially here with
the dataset loaded once (sharing RAM exactly like the reference's global
arrays). Multi-host sweeps shard settings files across hosts at the driver
level. --parallelism and --cuda_device_ids are accepted and ignored.

Each settings JSON is a dict with the same keys as the train CLI's settings
(settings_id, net_name, input_names, label_names, target_height/width,
net_head_dims, label_dimensions, dropout_prob, layer_blocks_options,
linear_bias_options, optimizer, learning_rate, loss_norm_pow,
plateau_patience_epochs, augmentation knobs, batch_size,
sample_weighter_options).
"""

from __future__ import annotations

import glob
import json
import os
import sys

import numpy as np

from pilotguru_tpu.cli._common import add_dtype_flag, make_parser, setup_backend


def run_training_fold(
    settings: dict,
    train_data,
    val_data,
    epochs: int,
    num_nets: int,
    batch_use_prob: float,
    out_dir: str,
    log_dir: str,
    preload_dir=None,
):
    from pilotguru_tpu.ml import augmentation as aug
    from pilotguru_tpu.ml import data as data_lib
    from pilotguru_tpu.ml import models, training, weighting

    input_names = settings["input_names"]
    label_name = settings["label_names"][0]
    options = {
        models.NET_NAME: settings["net_name"],
        models.NET_HEAD_DIMS: settings.get("net_head_dims", 10),
        models.LABEL_DIMENSIONS: settings.get("label_dimensions", 1),
        models.DROPOUT_PROB: settings.get("dropout_prob", 0.0),
        models.LAYER_BLOCKS_OPTIONS: settings.get(
            "layer_blocks_options", models.DEFAULT_LAYER_BLOCKS_OPTIONS
        ),
    }
    shift_rate = settings.get("horizontal_label_shift_rate", [0.0])
    train_settings = training.TrainSettings(
        epochs=epochs,
        batch_size=settings["batch_size"],
        learning_rate=settings.get("learning_rate", 1e-3),
        optimizer=settings.get("optimizer", training.SGD),
        loss_norm_pow=settings.get("loss_norm_pow", 2.0),
        batch_use_prob=batch_use_prob,
        plateau_patience_epochs=settings.get("plateau_patience_epochs", 0),
        augment=aug.AugmentSettings(
            target_width=settings["target_width"],
            max_horizontal_shift_pixels=settings.get(
                "max_horizontal_shift_pixels", 0
            ),
            horizontal_label_shift_rate=tuple(np.atleast_1d(shift_rate)),
            blur_sigma=settings.get("train_blur_sigma", 2.0),
            blur_prob=settings.get("train_blur_prob", 0.0),
            grayscale_interpolate_prob=settings.get(
                "grayscale_interpolate_prob", 0.0
            ),
        ),
    )
    model = models.make_network(
        options, settings.get("linear_bias_options", [])
    )
    tx = training.make_optimizer(
        train_settings.optimizer, train_settings.learning_rate
    )
    example = {}
    for name in input_names:
        arr = train_data[name][:1]
        if name == models.FRAME_IMG:
            arr = data_lib.images_to_float(arr)[
                :, : settings["target_height"], : settings["target_width"]
            ]
        example[name] = np.asarray(arr, np.float32)
    state = training.init_ensemble(model, example, num_nets, tx)
    if preload_dir:
        full = os.path.join(preload_dir, settings["settings_id"])
        restored = training.load_ensemble_params(
            data_lib.preload_model_names(full, num_nets)
        )
        state = state._replace(
            params=restored["params"], batch_stats=restored["batch_stats"]
        )
    mags = np.mean(
        np.abs(train_data[label_name].reshape(train_data[label_name].shape[0], -1)),
        axis=1,
    )
    weighters = [
        weighting.make_sample_weighter(
            settings.get("sample_weighter_options", {"name": "uniform"}), mags
        )
        for _ in range(num_nets)
    ]
    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(log_dir, exist_ok=True)
    training.train_models(
        model, state, tx, train_data, val_data,
        input_names=input_names, label_name=label_name, weighters=weighters,
        settings=train_settings, out_dir=out_dir, print_log=False,
        log_path=os.path.join(log_dir, "train_log.jsonl"),
    )


def main(argv=None):
    parser = make_parser(__doc__)
    parser.add_argument("--data_dirs", required=True)
    parser.add_argument("--validation_data_dirs", required=True)
    parser.add_argument("--data_file_suffix", default="data.npz")
    parser.add_argument("--train_settings_json_glob", required=True)
    parser.add_argument("--epochs", type=int, required=True)
    parser.add_argument("--preload_dir", default=None)
    parser.add_argument("--out_dir", required=True)
    parser.add_argument("--log_dir", required=True)
    parser.add_argument("--parallelism", type=int, default=1)  # ignored
    parser.add_argument("--num_nets_to_train", type=int, default=1)
    parser.add_argument("--batch_use_prob", type=float, default=1.0)
    parser.add_argument("--cuda_device_ids", default="0")  # ignored
    add_dtype_flag(parser)
    args = parser.parse_args(argv)
    setup_backend(args.dtype)

    from pilotguru_tpu.ml import data as data_lib

    settings_list = []
    for pattern in args.train_settings_json_glob.split(","):
        for name in sorted(glob.glob(pattern)):
            with open(name) as f:
                settings_list.append(json.load(f))
    if not settings_list:
        parser.error("no settings files matched --train_settings_json_glob")

    first = settings_list[0]
    element_names = first["input_names"] + first["label_names"]
    train_data = data_lib.load_dataset(
        args.data_dirs.split(","), element_names, args.data_file_suffix
    )
    val_data = data_lib.load_dataset(
        args.validation_data_dirs.split(","), element_names, args.data_file_suffix
    )

    for settings in settings_list:
        sid = settings["settings_id"]
        run_training_fold(
            settings,
            train_data,
            val_data,
            epochs=args.epochs,
            num_nets=args.num_nets_to_train,
            batch_use_prob=args.batch_use_prob,
            out_dir=os.path.join(args.out_dir, sid),
            log_dir=os.path.join(args.log_dir, sid),
            preload_dir=args.preload_dir,
        )
        print(sid)
    return 0


if __name__ == "__main__":
    sys.exit(main())
