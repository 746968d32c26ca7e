# shared transformer block (reference config/DINO/coco_transformer.py)
lr = 0.0001
param_dict_type = "default"
lr_backbone = 1e-05
hidden_dim = 256
dropout = 0.0
nheads = 8
num_queries = 300
enc_layers = 6
dec_layers = 6
dim_feedforward = 2048
num_feature_levels = 4
enc_n_points = 4
dec_n_points = 4
two_stage_type = "standard"
