function reset_all()
% reset_all()
%   Drop every solver and stand-alone net held by the gateway and rotate
%   the init_key, invalidating all outstanding handles.

caffe_('reset');
is_valid_handle('get_new_init_key');

end
