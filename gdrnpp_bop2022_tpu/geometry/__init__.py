from . import rotations, camera, se3, symmetry
