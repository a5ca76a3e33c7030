from taichislam_tpu.node.core import TaichiSLAMNodeCore  # noqa: F401
