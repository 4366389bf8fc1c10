from mst_tpu.ops.heatmap import (
    gaussian_template_normalizer,
    rasterize_gaussian,
    rasterize_dist,
    dist_template_scale,
)
from mst_tpu.ops.softargmax import (softargmax2d, softargmax2d_auto,
                                    softargmax_on_prob_map)
from mst_tpu.ops.sampling import sample_heatmap
from mst_tpu.ops.pooling import max_pool_2x2, avg_pool_pyramid, upsample_bilinear_2x
from mst_tpu.ops.kmeans import batched_kmeans
