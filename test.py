"""CLI eval entry (reference test.py): restore monolithic or base+delta
checkpoints and run the multi-round stochastic test."""

import time

from mst_tpu import config as config_lib
from mst_tpu.data.splits import prepare_dataset
from mst_tpu.parallel.mesh import mesh_from_shape
from mst_tpu.train.trainer import restore_model
from mst_tpu.utils.seeding import set_random_seeds


def main(args):
    tic = time.time()
    set_random_seeds(args.seed)
    params = config_lib.get_params(args)
    image_path, data_path = config_lib.get_image_and_data_path(params)

    _, _, df_test = prepare_dataset(
        data_path, args.load_data, args.batch_size, None, None,
        args.val_files, args.val_split, args.test_splits, args.shuffle,
        args.share_val_test, "eval", args.show_details)

    ckpts, ckpts_name, is_sep = config_lib.get_ckpts_and_names(
        args.ckpts, args.ckpts_name, args.pretrained_ckpt,
        [args.tuned_ckpt] if args.tuned_ckpt else [])
    print(ckpts, ckpts_name)
    mesh = mesh_from_shape(args.mesh_shape, args.mesh_axes)

    # reference-faithful selection (reference test.py:31-40): with multiple
    # checkpoints only the LAST non-OODG one is tested (the OODG baseline
    # is evaluator/multickpts.py's job); an all-OODG list would leave
    # model unset, exactly like the reference.
    model = None
    if len(ckpts_name) == 1:
        model = restore_model(params, is_sep[0], ckpts[0], None, mesh)
    else:
        for i, (ckpt, name) in enumerate(zip(ckpts, ckpts_name)):
            if name != "OODG":
                model = restore_model(params, is_sep[i],
                                      ckpt if not is_sep[i] else ckpts[0],
                                      None if not is_sep[i] else ckpt, mesh)

    print("############ Test model ##############")
    set_random_seeds(args.seed)
    model.test(df_test, image_path)

    toc = time.time()
    print("Time spent:", time.strftime("%Hh%Mm%Ss", time.gmtime(toc - tic)))


if __name__ == "__main__":
    parser = config_lib.get_parser(False)
    main(parser.parse_args())
