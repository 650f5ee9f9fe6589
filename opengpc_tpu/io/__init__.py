from opengpc_tpu.io.png import read_png, read_gray, read_gray_batch, read_rgb, write_png
from opengpc_tpu.io.flo import read_flo, write_flo
from opengpc_tpu.io.raw import read_raw, write_raw
from opengpc_tpu.io.triplets import load_triplets, save_triplets
from opengpc_tpu.io.supports import read_supports, write_supports
