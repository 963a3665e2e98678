from .resnet import AZNet, build_network, init_network
