"""Host-side utilities: VOC mAP evaluation, config, logging, profiling."""
