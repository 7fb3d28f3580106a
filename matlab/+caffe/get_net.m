function net = get_net(varargin)
% net = get_net(model_file, phase_name) or
% net = get_net(model_file, weights_file, phase_name)
%   Build a caffe.Net from a prototxt; with three arguments, also load
%   trained weights from weights_file. phase_name is 'train' or 'test'.
%   matcaffe API parity: matlab/+caffe/get_net.m.

CHECK(nargin == 2 || nargin == 3, ['usage: ' ...
  'net = get_net(model_file, phase_name) or ' ...
  'net = get_net(model_file, weights_file, phase_name)']);
model_file = varargin{1};
phase_name = varargin{end};
CHECK(ischar(model_file), 'model_file must be a string');
CHECK(ischar(phase_name), 'phase_name must be a string');
CHECK_FILE_EXIST(model_file);
CHECK(any(strcmp(phase_name, {'train', 'test'})), ...
  'phase_name can only be ''train'' or ''test''');

net = caffe.Net(caffe_('get_net', model_file, phase_name));

if nargin == 3
  weights_file = varargin{2};
  CHECK(ischar(weights_file), 'weights_file must be a string');
  CHECK_FILE_EXIST(weights_file);
  net.copy_from(weights_file);
end

end
