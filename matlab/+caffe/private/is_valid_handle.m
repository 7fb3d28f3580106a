function valid = is_valid_handle(hObj)
% valid = is_valid_handle(hObj)
%   True iff hObj is a gateway handle struct whose init_key matches the
%   live gateway epoch. Handles die when caffe.reset_all() rotates the
%   key. Call is_valid_handle('get_new_init_key') after a reset to adopt
%   the new epoch.
%
% A handle carries (uint64) ptr — the gateway object id — and (double)
% init_key — the epoch it was minted in.

persistent epoch;
if isempty(epoch) || (ischar(hObj) && strcmp(hObj, 'get_new_init_key'))
  epoch = caffe_('get_init_key');
  if ischar(hObj)
    return
  end
end

valid = isstruct(hObj) ...
  && isscalar(hObj.ptr) && isa(hObj.ptr, 'uint64') ...
  && isscalar(hObj.init_key) && isa(hObj.init_key, 'double') ...
  && hObj.init_key == epoch;

end
