from .segmenter import Segmentation, segment_network
