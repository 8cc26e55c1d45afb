from visualdet3d_tpu.ops.cost_volume import (
    concat_volume,
    correlation_volume,
    correlation_volume_interleaved,
    correlation_volume_pallas,
    correlation_volume_xla,
)
from visualdet3d_tpu.ops.deform_conv import deform_conv, modulated_deform_conv
from visualdet3d_tpu.ops.nms import class_offset_boxes, nms
from visualdet3d_tpu.ops.rotated_iou import (
    boxes_iou3d,
    camera_box_to_bev,
    rotated_iou,
    rotated_nms,
)
from visualdet3d_tpu.ops.sampling import grid_sample, grid_sample_2d
