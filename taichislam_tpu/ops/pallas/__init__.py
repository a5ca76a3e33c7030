from taichislam_tpu.ops.pallas import seg_accum
