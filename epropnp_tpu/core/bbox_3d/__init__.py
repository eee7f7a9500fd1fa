from .rotate_iou import (  # noqa: F401
    box3d_overlap_camera,
    rotated_iou_matrix,
    rotated_iou_pairwise,
)
from .nms import (nms_rotated, nms_axis_aligned,  # noqa: F401
                  nms_axis_aligned_per_image)
from .misc import (  # noqa: F401
    batched_bev_nms,
    batched_bev_nms_per_image,
    bboxes_3d_to_2d,
    compute_box_3d,
    gen_unit_noc,
    project_to_image,
    project_to_image_r_mat,
    rot_mat_to_yaw,
    xywhr2xyxyr,
)
