from taichislam_tpu.parallel import multi_drone
from taichislam_tpu.parallel.mesh import make_mesh
