from .image_bev_vis import draw_box_3d_pred, show_bev  # noqa: F401
from .deformable_point_vis import draw_correspondence_points  # noqa: F401
from .orient_density import draw_orient_density  # noqa: F401
from .show_result import show_result  # noqa: F401
