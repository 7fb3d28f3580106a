function set_mode_cpu()
% set_mode_cpu()
%   Route computation to the host CPU backend (JAX_PLATFORMS=cpu analog).

caffe_('set_mode_cpu');

end
