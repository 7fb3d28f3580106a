function set_mode_gpu()
% set_mode_gpu()
%   Route computation to the accelerator backend (TPU on this framework;
%   the matcaffe name is kept for compatibility).

caffe_('set_mode_gpu');

end
