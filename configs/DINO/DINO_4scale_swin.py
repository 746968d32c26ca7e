_base_ = ["DINO_4scale.py"]
backbone = "swin_L_384_22k"
