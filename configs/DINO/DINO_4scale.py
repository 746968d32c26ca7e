_base_ = ["coco_transformer.py"]
num_classes = 14
backbone = "resnet50"
use_dn = True
dn_number = 100
dn_label_noise_ratio = 0.5
dn_box_noise_scale = 1.0
