from . import lie, projective
