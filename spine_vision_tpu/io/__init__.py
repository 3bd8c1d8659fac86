"""Host-side I/O: medical-image decode/encode, PDF render, tabular tables.

Pure-Python replacements for the reference's SimpleITK/PyMuPDF/pandas stack
(reference io/; SURVEY.md §2.2): DICOM (single file + series assembly, RLE),
NIfTI-1, MetaImage (.mha/.mhd), and NRRD, all returning a
:class:`MedicalImage` carrying ITK-convention geometry so the crop math
ports exactly. On-device intensity work (normalize_to_uint8, resampling)
lives in :mod:`spine_vision_tpu.ops`.
"""

from spine_vision_tpu.io.dicom import read_dicom_file, read_dicom_series
from spine_vision_tpu.io.metaimage import read_metaimage, write_metaimage
from spine_vision_tpu.io.nifti import read_nifti, write_nifti
from spine_vision_tpu.io.nrrd import read_nrrd, write_nrrd
from spine_vision_tpu.io.pdf import (
    pdf_first_page_to_array,
    pdf_to_arrays,
    pdf_to_images,
)
from spine_vision_tpu.io.readers import ImageFormat, detect_format, read_medical_image
from spine_vision_tpu.io.series import (
    extract_isotropic_middle_slice,
    prepare_series_slice,
)
from spine_vision_tpu.io.tabular import load_tabular_data, write_records_csv
from spine_vision_tpu.io.types import MedicalImage
from spine_vision_tpu.io.writers import convert_format, write_medical_image

__all__ = [
    "ImageFormat",
    "MedicalImage",
    "convert_format",
    "detect_format",
    "extract_isotropic_middle_slice",
    "load_tabular_data",
    "pdf_first_page_to_array",
    "pdf_to_arrays",
    "pdf_to_images",
    "prepare_series_slice",
    "read_dicom_file",
    "read_dicom_series",
    "read_medical_image",
    "read_metaimage",
    "read_nifti",
    "read_nrrd",
    "write_medical_image",
    "write_metaimage",
    "write_nifti",
    "write_nrrd",
    "write_records_csv",
]
