# 5-scale DINO variant (`/root/reference/config/DINO/DINO_5scale.py`):
# same model as DINO_4scale plus the stride-4 backbone level — five feature
# levels, intermediate indices [0, 1, 2, 3], halved per-GPU batch. Unused by
# the ARCTIC training path (which runs 4-scale); provided for config parity.
_base_ = ["DINO_4scale.py"]
num_feature_levels = 5
return_interm_indices = [0, 1, 2, 3]
batch_size = 1
