from .meta import DatasetMeta, DATASETS_META, get_meta
