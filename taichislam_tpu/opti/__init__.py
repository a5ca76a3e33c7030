from taichislam_tpu.opti import transformations
from taichislam_tpu.opti.nnls import CostFunction, TaichiNNLS, NNLS
