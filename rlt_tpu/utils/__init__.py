from rlt_tpu.utils import metrics, losses  # noqa: F401
from rlt_tpu.utils.metrics import (  # noqa: F401
    f1_curve,
    dcg_curve,
    reward_matrix,
    f1_at_k,
    dcg_at_k,
    taskr_metric,
    taskc_metric,
    decode_cut,
    decode_cut_bicut,
)
