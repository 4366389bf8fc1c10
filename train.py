"""CLI train entry (reference train.py).

Same flags/flow: seed -> config merge -> data split -> build/restore ->
optional init-check -> train -> test on left-out data.
"""

import time

from mst_tpu import config as config_lib
from mst_tpu.data.splits import prepare_dataset
from mst_tpu.parallel.mesh import mesh_from_shape
from mst_tpu.train.trainer import Experiment
from mst_tpu.utils.seeding import set_random_seeds


def main(args):
    tic = time.time()
    set_random_seeds(args.seed)
    params = config_lib.get_params(args)
    image_path, data_path = config_lib.get_image_and_data_path(params)

    df_train, df_val, df_test = prepare_dataset(
        data_path, args.load_data, args.batch_size, args.n_train_batch,
        args.train_files, args.val_files, args.val_split, args.test_splits,
        args.shuffle, args.share_val_test, "train", args.show_details)

    experiment_name = config_lib.get_experiment_name(
        args, df_train.metaId.unique().shape[0])
    print(f"Experiment {experiment_name} has started")

    mesh = mesh_from_shape(args.mesh_shape, args.mesh_axes)
    model = Experiment(params, mesh=mesh)
    if args.pretrained_ckpt is not None:
        model.load_params(args.pretrained_ckpt)
        print(f"Loaded checkpoint {args.pretrained_ckpt}")
    else:
        print("Training from scratch")

    if args.init_check:
        if args.pretrained_ckpt is None:
            raise ValueError(
                "--init_check compares an adapter-free twin of a PRETRAINED "
                "checkpoint (reference train.py:47-59); pass "
                "--pretrained_ckpt")
        # adapter-free twin must score identically (reference train.py:47-59)
        params_pre = dict(params, position=[])
        pretrained = Experiment(params_pre, mesh=mesh)
        pretrained.load_params(args.pretrained_ckpt)
        ade_pre, fde_pre, _, _ = pretrained.test(df_test, image_path)
        ade_cur, fde_cur, _, _ = model.test(df_test, image_path)
        if abs(ade_pre - ade_cur) > 1e-9 or abs(fde_pre - fde_cur) > 1e-9:
            raise RuntimeError("Wrong model initialization")
        print("Passed initialization check")

    print("############ Train model ##############")
    model.train(df_train, df_val, image_path, image_path, experiment_name)

    print("############ Test leftout data ##############")
    set_random_seeds(args.seed)
    model.test(df_test, image_path)

    toc = time.time()
    print("Time spent:", time.strftime("%Hh%Mm%Ss", time.gmtime(toc - tic)))


if __name__ == "__main__":
    parser = config_lib.get_parser(True)
    main(parser.parse_args())
