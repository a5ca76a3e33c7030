from taichislam_tpu.ops import exports, fusion, occupancy, tsdf
