from pcnerf_tpu.ops.aabb import (  # noqa: F401
    slab_far_distance,
    positive_plane_far,
    face_hit_intersect,
    face_hit_first_two,
    perpendicular_distance_to_ray,
)
