from devias_tpu.aug.fame import FAMEConfig, fame_augment, fame_augment_hvu
