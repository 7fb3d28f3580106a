function version_str = version()
% version()
%   Framework version string (deepcut_tpu + the caffe release it tracks).

version_str = caffe_('version');

end
