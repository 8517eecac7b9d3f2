from .meta import DatasetMeta, DATASETS_META, get_meta, register_meta
from .bop_data import (InstanceRecord, index_bop_split, load_detections,
                       make_records_by_image, load_image, load_mask,
                       load_depth)
from .test_loader import iter_test_batches
