from rlt_tpu.utils import losses, metrics  # noqa: F401
from rlt_tpu.utils.batchnorm import batch_norm  # noqa: F401
from rlt_tpu.utils.checkpoint import load_params, save_params  # noqa: F401
from rlt_tpu.utils.logging import MetricsWriter  # noqa: F401
from rlt_tpu.utils.metrics import (  # noqa: F401
    dcg_at_k,
    dcg_curve,
    decode_cut,
    decode_cut_bicut,
    f1_at_k,
    f1_curve,
    reward_matrix,
    taskc_metric,
    taskr_metric,
)
