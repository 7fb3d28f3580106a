function set_device(device_id)
% set_device(device_id)
%   Select the accelerator device by index.

CHECK(isscalar(device_id) && device_id >= 0, ...
  'device_id must be non-negative integer');
caffe_('set_device', double(device_id));

end
