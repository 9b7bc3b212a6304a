python main.py --model_name R2L --render_only --pretrained_ckpt /tmp/nonexistent*.tar --dataset_type blender --datadir /tmp/verify_e2e/tinyscene
