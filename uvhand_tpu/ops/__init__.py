from .msda import ms_deform_attn, MSDeformAttn  # noqa: F401
