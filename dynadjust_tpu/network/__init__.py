from .data import NetworkData, build_network
