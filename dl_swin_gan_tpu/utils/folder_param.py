"""Experiment-folder naming convention.

TPU-native counterpart of reference `dl_cs/fileio/folder_param.py:8-75`:
hyperparameters <-> run-folder names of the form
`train-3D_{N}steps_{M}{type}_{F}features_{E}emaps_{W}weight`, parsed back by
the evaluation tooling (batch_recon).
"""

_MODEL_TO_TOKEN = {"RES": "resblocks", "SE": "SEblocks", "CBAM": "CBAMblocks",
                   "SWIN": "SWINblocks", "DIT": "DiTblocks",
                   "LATTE": "Latteblocks"}
_TOKEN_TO_MODEL = {v: k for k, v in _MODEL_TO_TOKEN.items()}


def parameter_to_folder(config) -> str:
    p = config.MODEL.PARAMETERS
    weight = 1 if config.MODEL.RECON_LOSS.LOSS_WEIGHT else 0
    token = _MODEL_TO_TOKEN.get(config.MODEL.MODEL_TYPE.upper(), "resblocks")
    return (f"train-3D_{p.NUM_UNROLLS}steps_{p.NUM_RESBLOCKS}{token}_"
            f"{p.NUM_FEATURES}features_{p.NUM_EMAPS}emaps_{weight}weight")


def folder_to_parameter(folder_name: str, write_config: bool = False,
                        config=None) -> dict:
    param = {}
    for part in folder_name.split("_"):
        for token in _TOKEN_TO_MODEL:
            if part.endswith(token):
                param["model_type"] = token
                param["num_resblocks"] = int(part[:-len(token)])
        if part.endswith("steps"):
            param["num_unrolls"] = int(part[:-5])
        elif part.endswith("features"):
            param["num_features"] = int(part[:-8])
        elif part.endswith("emaps"):
            param["num_emaps"] = int(part[:-5])
        elif part.endswith("weight"):
            param["loss_weight"] = part[:-6] == "1"

    if write_config and config is not None:
        config.MODEL.PARAMETERS.NUM_UNROLLS = param["num_unrolls"]
        config.MODEL.PARAMETERS.NUM_RESBLOCKS = param["num_resblocks"]
        config.MODEL.PARAMETERS.NUM_EMAPS = param["num_emaps"]
        config.MODEL.PARAMETERS.NUM_FEATURES = param["num_features"]
        config.MODEL.RECON_LOSS.LOSS_WEIGHT = param["loss_weight"]
        if "model_type" in param:
            config.MODEL.MODEL_TYPE = _TOKEN_TO_MODEL[param["model_type"]]
    return param
