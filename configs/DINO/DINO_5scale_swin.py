# `/root/reference/config/DINO/DINO_5scale_swin.py`: the 5-scale variant on
# the Swin-L-384-22k backbone.
_base_ = ["DINO_5scale.py"]
backbone = "swin_L_384_22k"
