from mst_tpu.evaluator.logs import (
    MetricsLogger,
    extract_epoch_curve,
    extract_test_metrics,
    extract_train_metrics,
)
from mst_tpu.evaluator.metrics import image2world, metrics_dataframe, min_ade_fde
