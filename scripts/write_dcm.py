#!/usr/bin/env python
"""CFL reconstruction -> DICOM series. TPU-native counterpart of reference
`write_dcm.py:18-236` (pydicom, anonymized UIDs, window/level). pydicom is
not baked into this image, so the script degrades gracefully: without
pydicom it writes the windowed int16 pixel volumes + metadata JSON next to
where the DICOMs would go, preserving the pipeline slot.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def window_int16(mag: np.ndarray) -> np.ndarray:
    """Window/level magnitude into int16 pixel values like the reference."""
    lo, hi = np.percentile(mag, 1), np.percentile(mag, 99)
    mag = np.clip((mag - lo) / (hi - lo + 1e-12), 0, 1)
    return (mag * 4095).astype(np.int16)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("file", help="CFL basename")
    parser.add_argument("--out-directory", required=True)
    parser.add_argument("--series-description", default="dl_swin_gan_tpu recon")
    args = parser.parse_args(argv)

    from scripts.display_data import load_cfl_images
    vols = load_cfl_images(args.file)  # [sl, emap, ph, y, x]
    pixels = window_int16(np.abs(vols[:, 0]))  # [sl, ph, y, x]
    os.makedirs(args.out_directory, exist_ok=True)

    try:
        import pydicom
        from pydicom.dataset import Dataset, FileMetaDataset
        from pydicom.uid import ExplicitVRLittleEndian, generate_uid
    except ImportError:
        out = os.path.join(args.out_directory, "series_int16.npz")
        np.savez_compressed(out, pixels=pixels)
        meta = dict(series_description=args.series_description,
                    shape=list(pixels.shape), dtype="int16",
                    note="pydicom unavailable; raw windowed pixels written")
        with open(os.path.join(args.out_directory, "series_meta.json"), "w") as f:
            json.dump(meta, f, indent=2)
        print(out)
        return

    study_uid = generate_uid()
    series_uid = generate_uid()
    idx = 0
    for sl in range(pixels.shape[0]):
        for ph in range(pixels.shape[1]):
            idx += 1
            ds = Dataset()
            ds.PatientName = "ANON"
            ds.PatientID = "ANON"
            ds.StudyInstanceUID = study_uid
            ds.SeriesInstanceUID = series_uid
            ds.SOPInstanceUID = generate_uid()
            ds.SOPClassUID = "1.2.840.10008.5.1.4.1.1.4"  # MR
            ds.Modality = "MR"
            ds.SeriesDescription = args.series_description
            ds.InstanceNumber = idx
            ds.SliceLocation = float(sl)
            ds.Rows, ds.Columns = pixels.shape[-2:]
            ds.BitsAllocated = 16
            ds.BitsStored = 12
            ds.HighBit = 11
            ds.PixelRepresentation = 1
            ds.SamplesPerPixel = 1
            ds.PhotometricInterpretation = "MONOCHROME2"
            ds.WindowCenter = 2048
            ds.WindowWidth = 4096
            ds.PixelData = pixels[sl, ph].tobytes()
            meta = FileMetaDataset()
            meta.TransferSyntaxUID = ExplicitVRLittleEndian
            ds.file_meta = meta
            path = os.path.join(args.out_directory, f"IM{idx:05d}.dcm")
            ds.save_as(path, write_like_original=False)
    print(args.out_directory)


if __name__ == "__main__":
    main()
