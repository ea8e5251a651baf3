#!/usr/bin/env python
"""Thin alias of scripts/train.py (the reference keeps train_cbam.py as a
whitespace clone of train.py; here MODEL.MODEL_TYPE carries the choice)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODEL_TYPE = "cbam".upper()

if __name__ == "__main__":
    sys.argv += ["MODEL.MODEL_TYPE", MODEL_TYPE]
    from scripts.train import main
    main()
