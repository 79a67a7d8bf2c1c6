"""Host-side line geometry: contours, skew, reading order, extraction."""

from ocr_inference_tpu.geometry.lines import (  # noqa: F401
    build_line_data,
    build_raw_line_data,
    calculate_rotation_angle_from_lines,
    extract_line_images,
    filter_line_contours,
    get_contours,
    get_line_image,
    get_line_threshold,
    get_rotation_angle_from_lines,
    get_text_bbox,
    get_union_bbox,
    group_line_chunks,
    mask_n_crop,
    optimize_contour,
    rotate_contour,
    rotate_from_angle,
    sort_bbox_centers,
    sort_lines_by_peaks,
    sort_lines_by_threshold,
    sort_lines_by_threshold2,
)
