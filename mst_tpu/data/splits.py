"""Train/val/test split preparation (reference utils/data_utils.py:754-964)."""

import os
import pathlib

import numpy as np
import pandas as pd


def reduce_df_meta_ids(df, meta_ids):
    return df[df["metaId"].isin(np.asarray(meta_ids))]


def dataset_split_by_ratio(df, val_split, test_split=None, shuffle=False,
                           share_val_test=False, given_test_meta_ids=None):
    """reference data_utils.py:770-809."""
    unique_meta_ids = np.unique(df["metaId"])
    if shuffle:
        np.random.shuffle(unique_meta_ids)
    n = unique_meta_ids.shape[0]
    n_val = int(val_split) if val_split > 1 else int(val_split * n)
    if test_split is not None:
        n_test = int(test_split) if test_split > 1 else int(test_split * n)
        if share_val_test:
            n_train = n - n_test
            train_ids, test_ids = np.split(unique_meta_ids, [n_train])
            if n_val != 0:
                interval = n_test // n_val if n_test // n_val > 1 else 3
                df_val = reduce_df_meta_ids(df, test_ids[::interval])
            else:
                df_val = None
            df_test = reduce_df_meta_ids(df, test_ids)
        else:
            n_train = n - n_val - n_test
            train_ids, val_ids, test_ids = np.split(
                unique_meta_ids, [n_train, n_train + n_val])
            if given_test_meta_ids is not None:
                test_ids = given_test_meta_ids
            df_test = reduce_df_meta_ids(df, test_ids)
            df_val = reduce_df_meta_ids(df, val_ids)
    else:
        # NOTE: faithful reference quirk (data_utils.py:806-808): the
        # val/train names are SWAPPED relative to the split sizes — the
        # first n - n_val ids land in df_val and the trailing n_val ids in
        # df_train. No shipped config reaches this branch (every experiment
        # passes test_split or uses predefined pickles), but callers of the
        # two-way ratio split inherit the reference's behavior byte-for-byte
        # rather than a silent fix. See docs/parity.md.
        n_train = n - n_val
        val_ids, train_ids = np.split(unique_meta_ids, [n_train])
        df_test = None
        df_val = reduce_df_meta_ids(df, val_ids)
    return reduce_df_meta_ids(df, train_ids), df_val, df_test


def split_train_val_test_sequentially(data_path, train_files, val_split,
                                      test_splits=None, shuffle=False,
                                      share_val_test=False):
    """reference data_utils.py:754-767."""
    if test_splits is None:
        # the reference crashes with an opaque zip TypeError here; fail
        # with an actionable message instead (same outcome, clearer)
        raise ValueError(
            "sequential split needs --test_splits (one per --val_files "
            "entry); pass 0 for files that contribute no test set")
    if len(test_splits) < len(train_files):
        import warnings
        warnings.warn(
            f"{len(train_files)} train files but {len(test_splits)} "
            "test_splits: trailing files are DROPPED from all splits "
            "(reference zip-truncation semantics)", stacklevel=2)
    dfs = ([], [], [])
    for train_file, test_split in zip(train_files, test_splits):
        df = pd.read_pickle(os.path.join(data_path, train_file))
        tr, va, te = dataset_split_by_ratio(df, val_split, test_split,
                                            shuffle, share_val_test)
        dfs[0].append(tr)
        dfs[1].append(va)
        if te is not None:
            dfs[2].append(te)
    cat = lambda xs: pd.concat(xs) if xs else pd.DataFrame([])  # noqa: E731
    return cat(dfs[0]), cat([d for d in dfs[1] if d is not None]), cat(dfs[2])


def load_predefined_train_val_test(data_path, batch_size, n_train_batch=None,
                                   shuffle=False):
    """reference data_utils.py:859-872."""
    df_train = pd.read_pickle(f"{data_path}/train.pkl")
    df_val = pd.read_pickle(f"{data_path}/val.pkl")
    df_test = pd.read_pickle(f"{data_path}/test.pkl")
    if n_train_batch is not None:
        n_sample = int(batch_size * n_train_batch)
        ids = df_train.metaId.unique()
        assert n_sample <= ids.shape[0], \
            f"Training set size ({ids.shape[0]}) < Sample size ({n_sample})"
        if shuffle:
            np.random.shuffle(ids)
        df_train = reduce_df_meta_ids(df_train, ids[:n_sample])
    return df_train, df_val, df_test


def limit_samples(df, num, batch_size, random_ids=True):
    """Few-shot cap: num * batch_size metaIds (data_utils.py:955-964)."""
    if num is None:
        return df
    meta_ids = np.unique(df["metaId"])
    if random_ids:
        np.random.shuffle(meta_ids)
    return reduce_df_meta_ids(df, meta_ids[:int(num * batch_size)])


def prepare_dataset(data_path, load_data, batch_size, n_train_batch,
                    train_files, val_files, val_split, test_splits,
                    shuffle, share_val_test, mode="train",
                    show_details=False):
    """reference prepare_dataeset (data_utils.py:875-912)."""
    if load_data == "predefined":
        df_train, df_val, df_test = load_predefined_train_val_test(
            data_path, batch_size=batch_size, n_train_batch=n_train_batch,
            shuffle=shuffle)
    else:
        if mode == "train":
            assert train_files is not None, "No train file is provided"
            assert val_files is not None, "No val file is provided"
            if train_files != val_files:
                raise NotImplementedError
            df_train, df_val, df_test = split_train_val_test_sequentially(
                data_path, train_files, val_split, test_splits, shuffle,
                share_val_test)
            df_train = limit_samples(df_train, n_train_batch, batch_size)
        elif mode == "eval":
            assert val_files is not None, "No val file is provided"
            df_train, df_val, df_test = split_train_val_test_sequentially(
                data_path, val_files, val_split, test_splits, shuffle,
                share_val_test)
        else:
            raise NotImplementedError
    if show_details:
        for name, d in [("train", df_train), ("val", df_val),
                        ("test", df_test)]:
            if d is not None and len(d):
                print(f"{name}_meta_ids: {d.metaId.unique()}")
    return df_train, df_val, df_test


def dataset_split_given_scenes(data_path, files, scenes):
    """Rows of the listed pickles belonging to the given sceneIds
    (reference data_utils.py:816-820)."""
    print(f"Split {files} given scenes={scenes}")
    df = pd.concat([pd.read_pickle(os.path.join(data_path, f))
                    for f in files])
    return df[df.sceneId.isin(scenes)]


def separate_data_label(df):
    """Split a velocity-bucketed DataFrame into one frame per vel_range,
    sorted by range label (reference utils/dataloader.py:53-56)."""
    labels = np.sort(np.unique(df["vel_range"]))
    return [df[df["vel_range"] == label] for label in labels]


def split_train_val_test_randomly(data_dir, data_filename, val_split,
                                  test_split, seed=1):
    """reference data_utils.py:823-856 (utils/split_dataset.py CLI)."""
    out_dir = f"{data_dir}/{data_filename.replace('.pkl', '')}"
    pathlib.Path(out_dir).mkdir(parents=True, exist_ok=True)
    df = pd.read_pickle(f"{data_dir}/{data_filename}")
    ids = np.unique(df["metaId"])
    n = ids.shape[0]
    n_val = int(val_split) if val_split > 1 else int(val_split * n)
    n_test = int(test_split) if test_split > 1 else int(test_split * n)
    n_train = n - n_val - n_test
    rng = np.random.default_rng(seed)
    rng.shuffle(ids)
    train_ids, val_ids, test_ids = np.split(ids, [n_train, n_train + n_val])
    reduce_df_meta_ids(df, train_ids).to_pickle(f"{out_dir}/train.pkl")
    reduce_df_meta_ids(df, val_ids).to_pickle(f"{out_dir}/val.pkl")
    reduce_df_meta_ids(df, test_ids).to_pickle(f"{out_dir}/test.pkl")


def filter_dataset_by_varf(data_path, out_path, varf, lower, upper, obs_len):
    """reference utils/filter_dataset.py:5-18 (recompute variant: derives
    the variation-factor stats from the data itself instead of a
    precomputed varf table)."""
    from mst_tpu.data.trajectories import aggregate_per_varf_value

    df = pd.read_pickle(data_path)
    stats = aggregate_per_varf_value(df, varf, obs_len)
    keep = stats[(stats[varf] >= lower) & (stats[varf] <= upper)].metaId
    out = reduce_df_meta_ids(df, keep.to_numpy())
    out.to_pickle(out_path)
    return out


def filter_by_varf_table(data_path, varf_path, lower_bound=None,
                         upper_bound=None, factor="avg_vel", out_path=None):
    """Filter a dataset against a precomputed variation-factor table
    (reference utils/filter_dataset.py:5-18 `filter_by_avg_vel`): keep the
    trajectories whose `factor` value in the varf pkl (written by the
    dataset builders / generate_varf) falls inside the optional one- or
    two-sided bounds. Writes `<data>_filter.pkl` next to the input like
    the reference unless out_path overrides it."""
    data = pd.read_pickle(data_path)
    varf = pd.read_pickle(varf_path)
    varf = varf[varf.metaId.isin(data.metaId.unique())]
    if lower_bound is not None:
        varf = varf[varf[factor] >= lower_bound]
    if upper_bound is not None:
        varf = varf[varf[factor] <= upper_bound]
    out = data[data.metaId.isin(varf.metaId.unique())]
    print(f"Before filter: #={data.shape[0]}")
    print(f"After filter: #={out.shape[0]}")
    out_path = out_path or data_path.replace(".pkl", "_filter.pkl")
    out.to_pickle(out_path)
    return out
