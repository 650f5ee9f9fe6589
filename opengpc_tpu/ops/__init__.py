from opengpc_tpu.ops.preprocess import box3, sobel3, candidate_mask
from opengpc_tpu.ops.codes import leaf_codes
from opengpc_tpu.ops.census import census5x5
