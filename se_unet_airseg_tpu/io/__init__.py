from .nifti import NiftiVolume, read_nifti, write_nifti

__all__ = ["NiftiVolume", "read_nifti", "write_nifti"]
