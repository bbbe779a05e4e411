"""Rigid-body geometry core (L1): functional rotations/frames on jnp arrays."""
from packppi_tpu.geometry.rigid import (  # noqa: F401
    Rigid,
    bb_frames_from_atom14,
    compose,
    from_4x4,
    identity,
    invert,
    invert_apply,
    rigid_apply,
    rigid_from_3_points,
    scale_translation,
    to_4x4,
)
from packppi_tpu.geometry.dihedrals import (  # noqa: F401
    dihedral_from_four_points,
    dihedrals_along_chain,
    wrap_angle,
)
from packppi_tpu.geometry.frames import (  # noqa: F401
    atom14_coords_from_torsions,
    frames_to_atom14_positions,
    torsion_angles_to_frames,
)
